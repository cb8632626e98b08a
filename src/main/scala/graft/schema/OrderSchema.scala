package graft.schema

import org.apache.spark.sql.types._

/** Schemas and domain constants for the e-commerce order pipeline.
  *
  * The reference keeps its schema implicit (built by construction in
  * the generator, assumed by key access in the processor — see
  * ecommerce-order-generator-function.py:89-107 and
  * ecommerce-order-processor.py:130-161); here it is an explicit
  * `StructType`, which is what the streaming file source requires and
  * what replaces the reference's Glue-crawler inference step.
  *
  * Money fields stay `DoubleType` at the storage/JSONL boundary for
  * wire parity with the reference's JSON numbers; all arithmetic on
  * them is done in exact DECIMAL inside the enrichment layer.
  */
object OrderSchema {

  /** Typed row for the item struct — the compile-time face of
    * [[itemType]] for `Dataset[RawOrder]` boundaries. */
  final case class OrderItem(
      product_id: String, product_name: String, category: String,
      quantity: Int, unit_price: Double, discount_percentage: Int,
      discount_amount: Double, subtotal: Double)

  /** Typed raw order (17 fields, generator-function.py:89-107) —
    * used at pipeline boundaries where compile-time field checks
    * help; the untyped DataFrame form stays primary (SURVEY.md §1.4). */
  final case class RawOrder(
      order_id: String, order_date: String, customer_id: String,
      customer_email: String, customer_city: String,
      items: Seq[OrderItem], num_items: Int, total_quantity: Int,
      subtotal: Double, total_discount: Double, shipping_cost: Double,
      tax_rate: Double, tax_amount: Double, total_amount: Double,
      payment_method: String, status: String, created_at: String)

  /** Item struct — 8 fields (generator-function.py:58-67). */
  val itemType: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DoubleType),
    StructField("discount_percentage", IntegerType),
    StructField("discount_amount", DoubleType),
    StructField("subtotal", DoubleType)))

  /** Raw order — 17 fields (generator-function.py:89-107). */
  val rawOrderType: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_date", StringType),
    StructField("customer_id", StringType),
    StructField("customer_email", StringType),
    StructField("customer_city", StringType),
    StructField("items", ArrayType(itemType)),
    StructField("num_items", IntegerType),
    StructField("total_quantity", IntegerType),
    StructField("subtotal", DoubleType),
    StructField("total_discount", DoubleType),
    StructField("shipping_cost", DoubleType),
    StructField("tax_rate", DoubleType),
    StructField("tax_amount", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("payment_method", StringType),
    StructField("status", StringType),
    StructField("created_at", StringType)))

  /** Raw order schema extended with the corrupt-record side channel
    * used by the PERMISSIVE JSONL reader (processor.py:176-182's
    * per-line JSONDecodeError tolerance). */
  val rawOrderWithCorruptType: StructType =
    rawOrderType.add(StructField("_corrupt_record", StringType))

  /** Product catalog (generator-function.py:17-28): 6 products across
    * electronics/clothing. Broadcast-sized at any scale. */
  final case class CatalogProduct(
      productId: String, productName: String, unitPrice: BigDecimal,
      category: String)

  val catalog: Seq[CatalogProduct] = Seq(
    CatalogProduct("ELEC001", "iPhone 15 Pro", BigDecimal("1199.99"), "Smartphones"),
    CatalogProduct("ELEC002", "Samsung Galaxy S24", BigDecimal("999.99"), "Smartphones"),
    CatalogProduct("ELEC003", "MacBook Air M3", BigDecimal("1499.99"), "Laptops"),
    CatalogProduct("ELEC004", "Dell XPS 15", BigDecimal("1299.99"), "Laptops"),
    CatalogProduct("CLOT001", "Nike Air Max Sneakers", BigDecimal("129.99"), "Shoes"),
    CatalogProduct("CLOT002", "Adidas Running Shoes", BigDecimal("119.99"), "Shoes"))

  /** Cities (generator-function.py:31); the first three are the
    * "major" cities of the shipping rule (generator-function.py:73)
    * and the delivery-priority rule (processor.py:92). */
  val cities: Seq[String] = Seq("Paris", "Lyon", "Marseille", "Toulouse", "Nice")
  val majorCities: Seq[String] = cities.take(3)

  val paymentMethods: Seq[String] = Seq("credit_card", "paypal", "apple_pay")
  val orderStatuses: Seq[String] =
    Seq("pending", "confirmed", "shipped", "delivered", "cancelled")

  /** Business thresholds (processor.py:14-15). HIGH_VALUE_ORDER is
    * dead config in the reference (declared, never read) — kept here
    * for documentation only. */
  val bulkOrderQty = 10
  val highValueOrder = 500

  /** Validation error messages (processor.py:108-117, verbatim). */
  object Errors {
    val invalidTotal = "Montant total invalide"
    val missingOrderId = "ID commande manquant"
    val noItems = "Aucun article"
    val inconsistentSubtotal = "Sous-total incohérent"
  }
}
